"""spark-submit entry script: spark-submit --py-files dist/py3dtiles_spark.zip cli.py ..."""

import sys

from py3dtiles_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
