"""``python -m cliqz_etl_spark`` entry point (see cli.py)."""

from cliqz_etl_spark.cli import main

raise SystemExit(main())
