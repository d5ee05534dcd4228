"""Build dist/newspaper_spark.zip for spark-submit --py-files.

Bundles the package (code + stopword resources) so executors can import
it without a shared filesystem; usage:

  python scripts/make_dist.py
  spark-submit --py-files dist/newspaper_spark.zip scripts/submit_job.py \
      --input /path/transcripts --output /path/out
"""
import os
import pathlib
import sys
import zipfile

ROOT = pathlib.Path(__file__).resolve().parents[1]


def main():
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "newspaper_spark.zip"
    pkg = ROOT / "newspaper_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in sorted(pkg.rglob("*")):
            if path.is_dir() or "__pycache__" in path.parts:
                continue
            zf.write(path, path.relative_to(ROOT))
    print(out)


if __name__ == "__main__":
    main()
