#!/usr/bin/env python
"""Top-level entry with the same CLI surface as the reference main.py."""

from dpmn_tpu.cli import main

if __name__ == "__main__":
    main()
