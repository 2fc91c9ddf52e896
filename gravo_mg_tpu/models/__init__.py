"""Model problems (workloads) built on the solver stack.

The reference expresses its workloads inside demos and the experiment
harness; here they are reusable components (SURVEY.md §2.4).
"""

from .problems import (  # noqa: F401
    ConformalFlow,
    ProblemSetup,
    poisson_problem,
    smoothing_problem,
)

__all__ = [
    "ConformalFlow",
    "ProblemSetup",
    "poisson_problem",
    "smoothing_problem",
]
