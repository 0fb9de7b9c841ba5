"""spark-submit entry script: thin wrapper over the package CLI so the
engine launches as `spark-submit --py-files dist/detectingscc_spark.zip
tools/submit_main.py <args>` (the package zip rides --py-files; this
file is the required top-level script spark-submit executes). Same
arguments as `python -m detectingscc_spark`."""

from detectingscc_spark.__main__ import main

if __name__ == "__main__":
    main()
