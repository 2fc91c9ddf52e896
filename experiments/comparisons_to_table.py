"""Aggregate comparison CSVs into spreadsheet + LaTeX tables.

Schema parity with the reference's table generator
(`experiments/python/comparisons_to_table.py:9-143`): mean/std/median over
repetitions, seconds conversion, booktabs LaTeX.  Output falls back to CSV
when no xlsx writer (openpyxl) is installed.
"""

from pathlib import Path

import pandas as pd
from tabulate import tabulate


def float_to_string(col, fmt="{:.2f}"):
    return col.map(fmt.format)


def save_to_table(out_dir, tau, label, latex=True, sig21=True, sig06=False,
                  amg=False, direct=False, cg=False, std=False,
                  names_counts=True):
    hierarchy_data = pd.read_csv(
        f"{out_dir}/hierarchy_ours_{label}.csv"
    ).sort_values("experiment").reset_index()
    solver_ours = pd.read_csv(
        f"{out_dir}/solver_ours_tau{tau}_{label}.csv"
    ).sort_values("experiment").reset_index()

    hier = hierarchy_data.groupby("experiment", as_index=False).agg(
        n_vertices=("n_vertices", "max"),
        mean_hierarchy=("hierarchy", "mean"),
        std_hierarchy=("hierarchy", "std"),
    )
    ours = solver_ours.groupby("experiment", as_index=False).agg(
        median_iterations=("iterations", "median"),
        mean_iterations=("iterations", "mean"),
        std_iterations=("iterations", "std"),
        mean_residue=("residue", "mean"),
        std_residue=("residue", "std"),
        mean_solver=("solver_total", "mean"),
        std_solver=("solver_total", "std"),
    )
    cols = [
        hier[["experiment", "n_vertices", "mean_hierarchy", "std_hierarchy"]],
        ours[[
            "median_iterations", "mean_iterations", "std_iterations",
            "mean_solver", "std_solver", "mean_residue", "std_residue",
        ]],
    ]
    if direct:
        d = pd.read_csv(
            f"{out_dir}/direct_tau{tau}_{label}.csv"
        ).sort_values("experiment").reset_index()
        cols.append(d[["direct_factor", "direct_solve",
                       "pardiso_factor", "pardiso_solve"]])
    if sig21:
        h21 = pd.read_csv(
            f"{out_dir}/hierarchy_sig21_{label}.csv"
        ).sort_values("experiment").reset_index()
        s21 = pd.read_csv(
            f"{out_dir}/solver_sig21_tau{tau}_{label}.csv"
        ).sort_values("experiment").reset_index().rename(columns={
            "iterations": "sig21_iterations", "residue": "sig21_residue",
            "solver_total": "sig21_solver",
        })
        cols += [h21[["sig21_hierarchy"]],
                 s21[["sig21_iterations", "sig21_solver", "sig21_residue"]]]
    if sig06:
        h06 = pd.read_csv(
            f"{out_dir}/hierarchy_sig06_{label}.csv"
        ).sort_values("experiment").reset_index().rename(
            columns={"hierarchy": "sig06_hierarchy"}
        )
        s06 = pd.read_csv(
            f"{out_dir}/solver_sig06_tau{tau}_{label}.csv"
        ).sort_values("experiment").reset_index().rename(columns={
            "iterations": "sig06_iterations", "residue": "sig06_residue",
            "solver_total": "sig06_solver",
        })
        cols += [h06[["sig06_hierarchy"]],
                 s06[["sig06_iterations", "sig06_solver", "sig06_residue"]]]
    if amg:
        for tag in ("rs", "sa"):
            a = pd.read_csv(
                f"{out_dir}/amg_{tag}_tau{tau}_{label}.csv"
            ).sort_values("experiment").reset_index()
            cols.append(a[[f"{tag}_hierarchy", f"{tag}_iterations",
                           f"{tag}_solver"]])
    if cg:
        c = pd.read_csv(
            f"{out_dir}/cg_tau{tau}_{label}.csv"
        ).sort_values("experiment").reset_index()
        cols.append(c[["cg_solver"]])

    table = pd.concat(cols, axis=1).sort_values("n_vertices").convert_dtypes()
    table["experiment"] = table["experiment"].replace(
        "_", " ", regex=True
    ).str.title()
    table["n_vertices"] = (
        (table["n_vertices"] / 1000).astype(int).astype(str) + "k"
    )
    for c_ in ("mean_hierarchy", "std_hierarchy", "mean_solver", "std_solver"):
        table[c_] = table[c_] / 1000
    table["median_iterations"] = table["median_iterations"].astype(int)
    table["our_hierarchy"] = float_to_string(table["mean_hierarchy"])
    table["our_iterations"] = float_to_string(table["mean_iterations"])
    table["our_solve"] = float_to_string(table["mean_solver"])
    table["our_residue"] = float_to_string(table["mean_residue"], "{:.2e}")
    if std:
        table["our_hierarchy"] += "(" + float_to_string(table["std_hierarchy"]) + ")"
        table["our_solve"] += "(" + float_to_string(table["std_solver"]) + ")"
    if direct:
        for c_ in ("direct_factor", "direct_solve", "pardiso_factor", "pardiso_solve"):
            table[c_] = table[c_] / 1000
    if sig21:
        for c_ in ("sig21_hierarchy", "sig21_solver"):
            table[c_] = table[c_] / 1000
    if sig06:
        for c_ in ("sig06_hierarchy", "sig06_solver"):
            table[c_] = table[c_] / 1000

    try:
        with pd.ExcelWriter(f"{out_dir}/{label}_{tau}_table.xlsx") as writer:
            table.to_excel(writer)
    except (ImportError, ModuleNotFoundError):
        table.to_csv(f"{out_dir}/{label}_{tau}_table.csv", index=False)

    if latex:
        latex_cols, headers = [], []
        if names_counts:
            latex_cols += ["experiment", "n_vertices"]
            headers += ["Model", "Vertices"]
        latex_cols += ["our_hierarchy", "median_iterations", "our_solve"]
        headers += ["Hier. (s)", "#Iter.", "Solve (s)"]
        if sig21:
            latex_cols += ["sig21_hierarchy", "sig21_iterations", "sig21_solver"]
            headers += ["SIG21 Hier. (s)", "#Iter.", "Solve (s)"]
        if sig06:
            latex_cols += ["sig06_hierarchy", "sig06_iterations", "sig06_solver"]
            headers += ["SIG06 Hier. (s)", "#Iter.", "Solve (s)"]
        if amg:
            latex_cols += ["rs_hierarchy", "rs_iterations", "rs_solver",
                           "sa_hierarchy", "sa_iterations", "sa_solver"]
            headers += ["RS Hier. (s)", "#Iter.", "Solve (s)",
                        "SA Hier. (s)", "#Iter.", "Solve (s)"]
        if direct:
            latex_cols += ["direct_factor", "direct_solve",
                           "pardiso_factor", "pardiso_solve"]
            headers += ["Fact. (s)", "Subst. (s)",
                        "Par. Fact. (s)", "Par. Subst. (s)"]
        out = tabulate(table[latex_cols], headers=headers,
                       tablefmt="latex_booktabs", showindex="never",
                       floatfmt=".2f")
        latex_dir = Path(out_dir).parents[0] / "latex"
        latex_dir.mkdir(parents=True, exist_ok=True)
        (latex_dir / f"comparisons_{label}_{tau}.tex").write_text(out)
    return table
