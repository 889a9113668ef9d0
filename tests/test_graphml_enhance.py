"""GraphML export round-trip + M9 enhancement semantics."""

from __future__ import annotations

import networkx  # noqa: F401 — absent in this container; guarded below
