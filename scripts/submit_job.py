#!/usr/bin/env python
"""spark-submit driver script (spark-submit takes a script, not -m):

    spark-submit [--master ...] \
        --py-files dist/opengauss_tools_datachecker_performance_spark.zip \
        scripts/submit_job.py --source ... --sink ... --assets ... \
        --report-dir out/ --checkpoint-dir ckpt/ --resume

Defers to the package __main__ so `python -m` (local) and spark-submit
(cluster) run the identical lifecycle. Under spark-submit a session
already exists; __main__ detects and reuses it.
"""

import sys

from opengauss_tools_datachecker_performance_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
