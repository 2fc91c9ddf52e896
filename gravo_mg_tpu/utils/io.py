"""CSV reporting + hierarchy serialization.

The writers match the reference's schema (`writeTiming`/`writeConvergence`,
gravomg/src/utility.cpp:106-149): timing rows are ``experiment,<sorted
keys>`` appended per experiment; convergence files are ``time,residue``
pairs.  Hierarchy (de)serialization is the TPU build's checkpoint/resume
analog of the reference's externalizable prolongation state
(`set_prolongation_matrices`, core.cpp:86-88).
"""

from __future__ import annotations

import os
from typing import Iterable, Tuple

import numpy as np


def write_timing_csv(filename, experiment, timing: dict, write_headers=False):
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    keys = sorted(timing.keys())  # std::map iterates sorted — same layout
    mode = "w" if write_headers else "a"
    with open(filename, mode) as f:
        if write_headers:
            f.write("experiment" + "".join(f",{k}" for k in keys) + "\n")
        f.write(str(experiment) + "".join(f",{timing[k]}" for k in keys) + "\n")


def write_convergence_csv(filename, convergence: Iterable[Tuple[float, float]]):
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "w") as f:
        f.write("time,residue\n")
        for t, r in convergence:
            f.write(f"{t},{r}\n")


def write_sparse_matrix(filename, A):
    """Text dump of a sparse matrix (utility.cpp:73-92 analog):
    ``rows cols nnz`` header then ``i j v`` triplets."""
    A = A.tocoo()
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "w") as f:
        f.write(f"{A.shape[0]} {A.shape[1]} {A.nnz}\n")
        for i, j, v in zip(A.row, A.col, A.data):
            f.write(f"{i} {j} {v}\n")


def save_hierarchy(filename, hierarchy):
    """Serialize a hierarchy to a .npz so expensive setup is reusable
    across processes (SURVEY.md §5 checkpoint/resume requirement)."""
    data = {
        "dof": np.asarray(hierarchy.dof, dtype=np.int64),
        "points": hierarchy.points,
        "neigh": hierarchy.neigh,
        "num_levels": np.asarray(len(hierarchy.levels)),
    }
    for k, lvl in enumerate(hierarchy.levels):
        # stored row-major (Nf, W); make_prolongation re-transposes on load
        data[f"U_cols_{k}"] = np.asarray(lvl.U.cols).T
        data[f"U_weights_{k}"] = np.asarray(lvl.U.weights).T
        data[f"U_ncoarse_{k}"] = np.asarray(lvl.U.ncoarse)
        data[f"samples_{k}"] = lvl.samples
        data[f"labels_{k}"] = lvl.labels
        data[f"coarse_points_{k}"] = lvl.coarse_points
        data[f"coarse_neigh_{k}"] = lvl.coarse_neigh
        data[f"stats_{k}"] = lvl.stats
    np.savez_compressed(filename, **data)


def load_hierarchy(filename):
    from ..hierarchy.builder import Hierarchy, HierarchyLevel
    from ..sparse import make_prolongation

    z = np.load(filename)
    levels = []
    for k in range(int(z["num_levels"])):
        levels.append(
            HierarchyLevel(
                U=make_prolongation(
                    z[f"U_cols_{k}"], z[f"U_weights_{k}"],
                    int(z[f"U_ncoarse_{k}"]),
                ),
                samples=z[f"samples_{k}"],
                labels=z[f"labels_{k}"],
                coarse_points=z[f"coarse_points_{k}"],
                coarse_neigh=z[f"coarse_neigh_{k}"],
                stats=z[f"stats_{k}"],
            )
        )
    return Hierarchy(
        [int(d) for d in z["dof"]], levels, z["points"], z["neigh"],
        {"hierarchy": 0.0},
    )
