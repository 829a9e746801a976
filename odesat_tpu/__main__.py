"""``python -m odesat_tpu`` entry point."""

import sys

from odesat_tpu.cli import main

sys.exit(main())
