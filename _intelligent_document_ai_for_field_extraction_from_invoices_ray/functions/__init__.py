"""Pure extraction semantics, shared by the Ray pipeline and the oracle."""
