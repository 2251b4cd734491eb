"""spark-submit wrapper script (spark-submit runs a script, not -m):

    cd /root/repo && zip -qr /tmp/engine.zip typhoon_ocr_spark
    spark-submit --py-files /tmp/engine.zip tools/submit_job.py \\
        --input data/pages_sf0.001/pages.parquet --output /tmp/out \\
        --master 'local[8]'

Forwards argv to typhoon_ocr_spark.plans.job.main — the module resolves
from the --py-files zip on executors and from the submit host's
PYTHONPATH on the driver.
"""

import sys

from typhoon_ocr_spark.plans.job import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
