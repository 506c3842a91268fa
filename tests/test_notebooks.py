"""The notebooks/ pair stays valid and executable.

Parity target: the reference ships notebooks/explore_data.ipynb and
notebooks/visualize_noise_effects.ipynb (SURVEY.md component 26). Ours are
built on the framework's own data/noise APIs; this test executes every
code cell headlessly so API drift breaks CI instead of the notebooks.
"""

import json
from pathlib import Path

import matplotlib
import pytest

matplotlib.use("Agg")

NOTEBOOKS = sorted(
    (Path(__file__).resolve().parent.parent / "notebooks").glob("*.ipynb")
)


def test_notebooks_exist():
    names = {p.name for p in NOTEBOOKS}
    assert {"explore_data.ipynb", "visualize_noise_effects.ipynb"} <= names


@pytest.mark.parametrize("path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook_executes(path, monkeypatch):
    # cells do sys.path.insert relative to Path.cwd().parent
    monkeypatch.chdir(path.parent)
    nb = json.loads(path.read_text())
    assert nb["nbformat"] == 4
    env: dict = {}
    for cell in nb["cells"]:
        if cell["cell_type"] == "code":
            exec("".join(cell["source"]), env)  # noqa: S102
    matplotlib.pyplot.close("all")
