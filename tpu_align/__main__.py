from tpu_align.cli import main

raise SystemExit(main())
