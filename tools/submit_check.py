"""Packaging check: zip the package and run a crawl through
``spark-submit --py-files`` — the north-rule deployment path, at TWO
cluster sizes (the rule's "N and 4N executors" shape; local[2] and
local[8] here — the rigorous pinned scaling-efficiency measurement
lives in bench.py --scaling, this check proves the submit path itself
works at both sizes).

Usage: python tools/submit_check.py [master ...]  (default local[2] local[8])

Builds crawler_spark.zip from the source tree, then launches
``spark-submit --master <master> --py-files crawler_spark.zip
tools/submit_job.py`` in a clean working directory so the job can only
import the package from the shipped zip. Exits non-zero on failure.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "crawler_spark.zip")
    pkg = os.path.join(REPO, "crawler_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_one(master: str) -> int:
    spark_home = os.environ.get("SPARK_HOME")
    submit = (
        os.path.join(spark_home, "bin", "spark-submit")
        if spark_home
        else shutil.which("spark-submit")
    )
    if submit is None:
        # pyspark pip installs ship spark-submit next to the package
        import pyspark

        submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    td = tempfile.mkdtemp(prefix="submit_check_")
    try:
        zpath = build_zip(td)
        job = os.path.join(td, "submit_job.py")
        shutil.copy(os.path.join(REPO, "tools", "submit_job.py"), job)
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # the zip must be the only import path
        proc = subprocess.run(
            [
                submit,
                "--master",
                master,
                "--conf",
                "spark.ui.enabled=false",
                "--conf",
                "spark.sql.shuffle.partitions=8",
                "--py-files",
                zpath,
                job,
            ],
            cwd=td,  # not the repo: proves imports come from the zip
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("{")), None
        )
        if proc.returncode != 0 or line is None:
            sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
            print(f"SUBMIT CHECK FAIL ({master})")
            return 1
        stats = json.loads(line)
        assert stats["results"] > 0 and stats["rounds"] >= 4, stats
        print(f"SUBMIT CHECK PASS ({master}): {line}")
        return 0
    finally:
        shutil.rmtree(td, ignore_errors=True)


def main() -> int:
    masters = sys.argv[1:] or ["local[2]", "local[8]"]
    for m in masters:
        rc = run_one(m)
        if rc:
            return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())
