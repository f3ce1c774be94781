from pfemfort_tpu.drivers.cli import main
import sys

sys.exit(main())
