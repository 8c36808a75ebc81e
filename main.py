#!/usr/bin/env python
"""Repo-root CLI shim, mirroring the reference's ``python main.py`` entry
point (reference: main.py). The real implementation lives inside the
package (:mod:`transductive_clip_tpu.cli`) so an installed distribution
ships no top-level ``main`` module; this file exists only so the
reference's invocation style keeps working from a source checkout.
"""

from transductive_clip_tpu.cli import main

if __name__ == "__main__":
    main()
