"""spark-submit driver script for the crawl engine.

The north-rule deployment shape: the package ships to executors as a zip
via ``--py-files`` and this thin driver runs the same CLI surface as
``python -m crawler_seo_spark``. Use ``scripts/submit.sh`` to build the
zip and launch; on a real cluster point ``--master`` (or $SPARK_MASTER)
at YARN / k8s / standalone instead of ``local[N]`` — no code changes.

Under spark-submit the session already exists (created by the launcher
JVM's conf), so ``get_spark`` simply ``getOrCreate``s into it; every
executor imports ``crawler_seo_spark`` from the shipped zip (the package
is pure Python — importable from a zip by construction, enforced by
``tests/test_cli.py::test_package_is_zip_importable``).
"""

import sys

from crawler_seo_spark.__main__ import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
