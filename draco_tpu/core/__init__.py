"""Core runtime: typed config, containers, pipeline manager, task IO.

Natively re-provides the runtime layer that the reference framework takes
from ``caput`` (pipeline Manager, config.Property, distributed containers;
see SURVEY.md section 1 L1-L2), re-designed for JAX arrays and device-mesh
sharding.
"""
