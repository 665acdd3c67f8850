from quickstep_tpu.cli.repl import main
import sys

sys.exit(main())
