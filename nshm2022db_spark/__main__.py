"""``python -m nshm2022db_spark`` — the database-generation CLI
(reference console script, pyproject.toml:42-43)."""

from nshm2022db_spark.cli import main

raise SystemExit(main())
