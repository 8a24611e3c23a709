"""Pure-Python / numpy kernels — no Ray imports in this subpackage."""
