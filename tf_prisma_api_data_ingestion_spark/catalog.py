"""Facade for the split catalog (r8 — layout only, the API is
unchanged): Spark q_* wrappers live in catalog_queries.py +
catalog_registry.py (which also holds the QUERIES registry and the
driver window), and the DuckDB oracle twins live in catalog_oracles.py
+ catalog_oracles2.py (which holds ORACLES). Import everything from
here; tests/test_registry.py pins key parity across the split.
"""

from .catalog_queries import *  # noqa: F401,F403
from .catalog_registry import *  # noqa: F401,F403
from .catalog_registry import _R15_WINDOW, _copurchase_edges  # noqa: F401
from .catalog_queries import _t  # noqa: F401
from .catalog_oracles import *  # noqa: F401,F403
from .catalog_oracles2 import *  # noqa: F401,F403
