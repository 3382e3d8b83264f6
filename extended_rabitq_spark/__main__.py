"""``python -m extended_rabitq_spark`` → CLI (see cli.py)."""

import sys

from .cli import main

sys.exit(main())
