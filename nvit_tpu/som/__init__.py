from nvit_tpu.som.kohonen import (
    KohonenSpec,
    bmu,
    grid_locations,
    hebbian_delta,
    init_nodes,
    make_spec,
    neighborhood_kernel,
)

__all__ = [
    "KohonenSpec",
    "bmu",
    "grid_locations",
    "hebbian_delta",
    "init_nodes",
    "make_spec",
    "neighborhood_kernel",
]
