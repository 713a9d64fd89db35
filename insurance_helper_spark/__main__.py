"""``python -m insurance_helper_spark <command>`` entry point."""

from insurance_helper_spark.cli import main

raise SystemExit(main())
