"""Committed notebooks must match their generator scripts.

Round 4 shipped a divergence: artifacts/make_workflow_notebook.py was
rewritten but notebooks/workflow.ipynb was not regenerated (ADVICE r4,
medium). This guard regenerates both notebooks into a temp dir and
compares code-cell sources against the committed files (committed
copies may additionally carry stored outputs — only sources must
match).
"""

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

nbformat = pytest.importorskip("nbformat")


def _sources(path: Path):
    nb = nbformat.read(str(path), as_version=4)
    return [(c.cell_type, c.source) for c in nb.cells]


@pytest.mark.parametrize("generator,notebook", [
    ("make_workflow_notebook.py", "workflow.ipynb"),
    ("make_explain_notebook.py", "explainability.ipynb"),
])
def test_committed_notebook_matches_generator(tmp_path, generator,
                                              notebook):
    shutil.copy(REPO / "artifacts" / generator, tmp_path / generator)
    (tmp_path / "notebooks").mkdir()
    subprocess.run([sys.executable, generator], cwd=tmp_path, check=True,
                   capture_output=True)
    regenerated = _sources(tmp_path / "notebooks" / notebook)
    committed = _sources(REPO / "notebooks" / notebook)
    assert regenerated == committed, (
        f"notebooks/{notebook} does not match artifacts/{generator}; "
        f"re-run the generator (then re-execute for stored outputs)")
