#!/usr/bin/env python3
"""spark-submit entry shim for the KG pipeline CLI.

spark-submit takes a script file, not a module, so this forwards to
:mod:`mhdb_tables2turtles_spark.__main__`:

    spark-submit --py-files pkg.zip scripts/run_kg.py --input ... --workdir ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhdb_tables2turtles_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
