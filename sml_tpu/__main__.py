from sml_tpu.cli import main

raise SystemExit(main())
