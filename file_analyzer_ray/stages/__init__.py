"""Ray Data stage callables: stateless batch fns and actor-pool classes."""
