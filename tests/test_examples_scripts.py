"""The examples/ scripts run clean end-to-end (the reference's CI runs its
example scripts the same way, `.github/workflows/test.yml:29-35`)."""

from __future__ import annotations

import subprocess
import sys

import pytest


@pytest.mark.parametrize(
    "script",
    ["example_fold.py", "example_scan.py", "example_pipeline.py",
     "example_multimodal.py", "example_dedup_sketch.py",
     "example_cdc_sketch.py", "example_training_layout.py",
     "example_streaming_ingest_dedup.py", "example_retrieval_rank.py",
     "example_quality_curation.py", "example_decision_science.py",
     "example_product_analytics.py", "example_eval_statistics.py"],
)
def test_example_runs(script):
    proc = subprocess.run(
        [sys.executable, f"examples/{script}"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
