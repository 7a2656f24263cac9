"""spark-submit --py-files deployment evidence (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Builds dist/fastlink_spark.zip with tools/make_pyfiles.py, then runs a
REAL ``spark-submit --py-files`` job in a clean working directory (so
the package can only be imported from the zip) that executes a small
end-to-end linkage and prints a result marker. No cluster exists in
this sandbox; the submit master is local[2] — the artifact path,
serialization and import story are identical on a real cluster.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import json
import sys

import fastlink_spark  # must resolve from the --py-files zip
from pyspark.sql import SparkSession

from fastlink_spark.plans.pipeline import LinkageConfig, link_dedupe
from fastlink_spark.sources.fixtures import generate_pages

spark = (
    SparkSession.builder.appName("fastlink_submit_smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .getOrCreate()
)
fx = generate_pages(n_base=120)
pages = spark.createDataFrame(fx.pages)
res = link_dedupe(spark, pages, LinkageConfig(checkpoint_dir=sys.argv[1]))
n_entities = res.entities.select("cluster_id").distinct().count()
n_records = res.entities.count()
print("SUBMIT_RESULT " + json.dumps({
    "n_records": n_records,
    "n_entities": n_entities,
    "pkg_from": fastlink_spark.__file__,
}))
spark.stop()
"""


def test_spark_submit_py_files(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_pyfiles import build

    zip_path = build(str(tmp_path / "fastlink_spark.zip"))
    # deterministic artifact: rebuilding an unchanged tree is byte-identical
    zip2 = build(str(tmp_path / "again.zip"))
    assert open(zip_path, "rb").read() == open(zip2, "rb").read()
    names = zipfile.ZipFile(zip_path).namelist()
    assert "fastlink_spark/__init__.py" in names
    assert "fastlink_spark/plans/pipeline.py" in names

    job_py = tmp_path / "job.py"
    job_py.write_text(JOB)
    ckpt = tmp_path / "ckpt"
    env = dict(os.environ)
    # scrub any path that could shadow the zip with the repo checkout
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[2]",
            "--py-files",
            zip_path,
            str(job_py),
            str(ckpt),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # NOT the repo root: import must come from the zip
        env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    marker = [ln for ln in out.stdout.splitlines() if ln.startswith("SUBMIT_RESULT ")]
    assert marker, f"no SUBMIT_RESULT in stdout:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    import json

    payload = json.loads(marker[0].removeprefix("SUBMIT_RESULT "))
    assert payload["n_records"] > 0
    assert 0 < payload["n_entities"] <= payload["n_records"]
    # the import really came from the submitted artifact, not the repo
    assert ".zip" in payload["pkg_from"], payload["pkg_from"]
