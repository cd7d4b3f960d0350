"""``python -m pdf_parser_spark`` → the reference-compatible CLI
(cli.py; reference /root/reference/pdf_parser/example.py)."""

import sys

from .cli import main

sys.exit(main())
