"""spark-submit launcher for the engine's job entrypoint.

spark-submit takes a SCRIPT file (it has no `-m` module mode), and
scotty_window_processor_spark/job.py uses package-relative imports, so
this thin script is the submittable unit:

    zip -r scotty.zip scotty_window_processor_spark
    spark-submit --py-files scotty.zip scripts/submit_job.py \
        synth --output /tmp/transcripts --n-convs 10000
    spark-submit --py-files scotty.zip scripts/submit_job.py \
        batch --input /tmp/transcripts --output /tmp/windows
    spark-submit --py-files scotty.zip scripts/submit_job.py \
        stream --input /tmp/transcripts --output /tmp/stream_out \
        --checkpoint /tmp/ckpt

The package resolves from --py-files on the executors; nothing here
depends on the repo checkout being present on the cluster.
"""

import sys

from scotty_window_processor_spark.job import main

if __name__ == "__main__":
    sys.exit(main())
