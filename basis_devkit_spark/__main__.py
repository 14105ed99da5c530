"""``python -m basis_devkit_spark`` entry point."""

from basis_devkit_spark.cli import main

raise SystemExit(main())
