from guagua_spark.cli import main

raise SystemExit(main())
