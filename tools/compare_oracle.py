"""Back-compat alias: the oracle gate lives in ``tools/check_oracles.py``
(same CLI, plus the strict DECIMAL-vs-integral type guard the external
comparison applies). Kept so documented invocations keep working.

Usage: python tools/compare_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracles import main

if __name__ == "__main__":
    raise SystemExit(main())
