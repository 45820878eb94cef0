#!/usr/bin/env python
"""Driver shim for the headline benchmark.

The benchmark itself lives inside the package
(:mod:`lasso_tpu.headline_bench`) so the installed ``lasso-tpu bench``
console entry also works on pip-installed copies. This file keeps the
driver contract: running ``python bench.py`` at the repo root prints
exactly one JSON line
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lasso_tpu.headline_bench import main

if __name__ == "__main__":
    main()
