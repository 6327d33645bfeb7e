"""Import-drift smoke for the examples suite (SURVEY.md §2.2).

Every example keeps its compute under main(), so importing is cheap and
catches the common failure mode: a library rename/removal breaking an
example nobody re-ran. (Full example runs live in the bench/eval paths —
e.g. realscan/benchmark flows are exercised by tests/test_realscan.py and
tests/test_batch_harness.py at test-sized shapes.)
"""

import importlib.util
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(ROOT, "examples")) if f.endswith(".py")
)


def test_examples_present():
    # The reference ships a 7-example surface (SURVEY.md §2.2); removing
    # one should be a deliberate, test-visible act.
    assert len(EXAMPLES) == 7


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_imports_and_has_main(name):
    path = os.path.join(ROOT, "examples", name)
    spec = importlib.util.spec_from_file_location(f"example_{name[:-3]}", path)
    mod = importlib.util.module_from_spec(spec)
    old_argv = sys.argv
    sys.argv = [path]  # argparse in main() is not run, but keep argv sane
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = old_argv
    assert callable(getattr(mod, "main", None)), f"{name} has no main()"
