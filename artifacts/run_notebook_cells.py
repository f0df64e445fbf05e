"""Execute notebooks/explainability.ipynb cell by cell (headless CI
validation — matplotlib Agg, CPU backend, cwd=notebooks/ so the
notebook's relative paths resolve exactly as interactive use would)."""

import os
import sys

os.chdir(os.path.join(os.path.dirname(__file__), "..", "notebooks"))
import matplotlib

matplotlib.use("Agg")
import jax

jax.config.update("jax_platforms", "cpu")

import nbformat

nb = nbformat.read("explainability.ipynb", as_version=4)
ns = {}
for i, cell in enumerate(nb.cells):
    if cell.cell_type != "code":
        continue
    src = cell.source.replace("plt.show()", "plt.close('all')")
    print(f"-- cell {i}", flush=True)
    exec(compile(src, f"<cell {i}>", "exec"), ns)
print("ALL CELLS OK")
