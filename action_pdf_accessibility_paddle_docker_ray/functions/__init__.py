"""Pure deterministic kernels shared by the golden oracle and the Ray pipeline."""
