"""North-rule ship path, literally: `spark-submit --py-files pkg.zip job.py`.

The reference workflow is a Julia session importing the package locally;
the north rule requires this engine to ship to a cluster as a --py-files
artifact instead. This test runs the REAL spark-submit binary with the
REAL zip from a scrubbed environment (no PYTHONPATH, cwd outside the
repo), and the job asserts its `copernicusdata_jl_spark` import came from
the shipped zip — not from any checkout on the node — before running a
mini flagship pipeline (dedup → extraction digest → cell index → cover
join → tiles) on both the driver and executor workers.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

from copernicusdata_jl_spark.session import build_py_files_zip

JOB = """
import os, sys

import copernicusdata_jl_spark
pkg_file = os.path.abspath(copernicusdata_jl_spark.__file__)
zip_src = os.environ["EXPECTED_ZIP"]
# --py-files places the zip on the driver sys.path (spark copies it into
# its temp dir); the import must resolve inside a *.zip path, never a repo
assert ".zip" in pkg_file, f"package imported outside the shipped zip: {pkg_file}"

from copernicusdata_jl_spark.session import get_spark
from copernicusdata_jl_spark.flagship import build_pages, flagship_pipeline

spark = get_spark(app_name="pyfiles-e2e", master="local[2]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
out = flagship_pipeline(build_pages(spark, 2000, partitions=4))
tiles = {r.tile_id: r.n_docs for r in out["tiles"].collect()}
n_extracted = out["extracted"].count()
digest = out["extracted"].selectExpr("bit_xor(xxhash64(text_sha256)) d").first().d
print(f"PYFILES_OK n_extracted={n_extracted} n_tiles={len(tiles)} digest={digest}")
spark.stop()
"""


def test_spark_submit_py_files_end_to_end(tmp_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "..", "..", "bin", "spark-submit"
    )
    if not spark_submit or not os.path.exists(spark_submit):
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")

    zpath = build_py_files_zip(str(tmp_path / "copernicusdata_jl_spark.zip"))
    job = tmp_path / "job.py"
    job.write_text(JOB)

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # nothing may leak the repo onto sys.path
    }
    env["EXPECTED_ZIP"] = zpath
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    res = subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", zpath, str(job)],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=tempfile.gettempdir(),
        env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    marker = [l for l in res.stdout.splitlines() if l.startswith("PYFILES_OK")]
    assert marker, res.stdout[-2000:] + res.stderr[-2000:]
    # deterministic pipeline: 2000 pages, 5% dup rate, all urls survive dedup
    assert "n_extracted=2000" in marker[0]
    assert "n_tiles=" in marker[0] and "digest=" in marker[0]
