from stencil_tpu.cli import main

raise SystemExit(main())
