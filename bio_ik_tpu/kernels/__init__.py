from .bio2_step import make_species_inner, make_species_kernel  # noqa: F401
