"""The tutorial notebooks (reference L5 deliverable format) must execute:
every code cell runs in order in a shared namespace, including the ED
comparison assertions inside the cells (NUM_STEPS reduced for CI wall-time;
the full budgets converge tighter, see BENCHMARKS.md)."""

import json
import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run_notebook(name, overrides):
    with open(os.path.join(EXAMPLES, name)) as f:
        nb = json.load(f)
    ns = {}
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        exec(compile(src, name, "exec"), ns)  # noqa: S102 - our own cells
        for k, v in overrides.items():
            if k in ns:
                ns[k] = v
    return ns


@pytest.mark.parametrize(
    "name,overrides",
    [
        ("Tutorial_1DTFIM.ipynb", {"NUM_STEPS": 500, "NUM_SAMPLES": 128}),
        ("Tutorial_1DJ1J2.ipynb", {"NUM_STEPS": 600, "NUM_SAMPLES": 128}),
    ],
)
def test_notebook_executes_and_converges(name, overrides):
    ns = _run_notebook(name, overrides)
    assert "est" in ns and "e_exact" in ns
