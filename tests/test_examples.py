"""The examples/ corpus runs green through the golden harness — the
user-facing demonstration that the training-data extension stages work
from plain YAML apps."""

import os
from pathlib import Path

import pytest

from pincette_json_streams_spark.plans.testing import run_app_test

EXAMPLES = sorted(
    p for p in (Path(__file__).parent.parent / "examples").iterdir()
    if p.is_dir()
)


@pytest.mark.parametrize("app_dir", EXAMPLES, ids=lambda p: p.name)
def test_example_app(spark, app_dir):
    report = run_app_test(spark, app_dir)
    assert report.ok, str(report.diffs)
