"""Deployment-path evidence for the north rule's "run via spark-submit
--py-files on a multi-executor cluster": zip the package, stage job.py ALONE
in an empty directory (so the import can only be satisfied by the
--py-files zip, exactly like a YARN/K8s driver container), run the real
`spark-submit` binary, and prove output + checkpoint-resume semantics
survive the packaged deployment — not just the in-process pytest session.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_package(dest: str) -> str:
    pkg = os.path.join(REPO, "latex_ocr_spark")
    zpath = os.path.join(dest, "latex_ocr_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(staging: str, zpath: str, corpus: str, out: str) -> str:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.setdefault("OMP_NUM_THREADS", "1")
    env.setdefault("OPENBLAS_NUM_THREADS", "1")
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            os.path.join(staging, "job.py"),
            "--input", corpus,
            "--output", out,
            "--parts", "0", "1",
            "--profile", "small",
        ],
        cwd=staging,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_py_files_e2e_and_resume(spark, corpus, tmp_path_factory):
    staging = str(tmp_path_factory.mktemp("submit_staging"))
    out = str(tmp_path_factory.mktemp("submit_out"))
    zpath = _zip_package(staging)
    # job.py alone in the staging dir: its own sys.path.insert points at an
    # empty directory, so `import latex_ocr_spark` must resolve via the zip
    shutil.copy(os.path.join(REPO, "job.py"), staging)

    stdout = _submit(staging, zpath, corpus, out)
    assert "done: 2 partition(s) processed this run" in stdout, stdout[-1500:]

    got = spark.read.parquet(os.path.join(out, "docs"))
    want = (
        spark.read.parquet(os.path.join(corpus, "docs"))
        .where("part in (0, 1)")
    )
    assert got.count() == want.count() > 0
    assert "spans" in got.columns
    # every media span was rewritten to decoded LaTeX (non-empty text)
    n_empty = got.selectExpr(
        "size(filter(spans, s -> s.kind = 'media' and (s.text is null or s.text = ''))) as bad"
    ).groupBy().sum("bad").collect()[0][0]
    assert n_empty == 0

    # second submit of the same partitions: checkpoint lineage marks them
    # complete, the anti-join skips them, and the job is a fast no-op
    stdout2 = _submit(staging, zpath, corpus, out)
    assert "done: 0 partition(s) processed this run" in stdout2, stdout2[-1500:]
    assert "2 already complete, skipped" in stdout2, stdout2[-1500:]
