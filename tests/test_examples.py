"""The examples/ scripts are user-facing documentation — keep them honest.

Every script must at least compile; the fast, host-side one runs end to end
(the training/XAI examples are exercised implicitly: they are thin
compositions of APIs the rest of the suite covers, and running them here
would roughly double suite wall time).
"""

import os
import py_compile
import runpy

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")
SCRIPTS = sorted(
    f for f in os.listdir(EXAMPLES_DIR) if f.endswith(".py")
)


@pytest.mark.parametrize("script", SCRIPTS)
def test_example_compiles(script):
    py_compile.compile(os.path.join(EXAMPLES_DIR, script), doraise=True)


def test_in_the_wild_example_runs(capsys):
    runpy.run_path(
        os.path.join(EXAMPLES_DIR, "04_in_the_wild_dataset.py"),
        run_name="__main__",
    )
    out = capsys.readouterr().out
    assert "rescue CSVs" in out and "train" in out
