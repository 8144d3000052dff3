"""Ray Data stage callables: batch functions (stateless tasks) and actor classes."""
