"""Pure per-document semantics shared by the Ray pipeline and the oracle."""
