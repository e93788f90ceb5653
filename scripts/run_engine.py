"""spark-submit entry script: the package arrives via --py-files."""

import sys

from parquet_converter_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
