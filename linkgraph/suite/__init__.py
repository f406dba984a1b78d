"""linkgraph.suite — the query/oracle registry (package form).

Round 5 split the former 8.4k-line suite.py monolith into round-scoped
modules (VERDICT r4 item 7).  Definition and registration ORDER is
byte-preserved: each module star-imports its predecessors and appends to
the single shared REGISTRY defined in ``_base``; this ``__init__`` imports
the chain tail, which transitively re-exports every public and helper
symbol, so ``from linkgraph import suite`` and ``linkgraph.suite.<name>``
behave exactly as before the split.
"""

from ._round4 import *  # noqa: F401,F403
