from ecwam_tpu.cli.main import main
import sys

sys.exit(main())
