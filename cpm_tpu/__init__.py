"""cpm_tpu: TPU-native correlated photon mapping for interactive global
illumination of time-varying volumetric data (JAX / Pallas / pjit).

A from-scratch re-design of the capabilities of the reference Inviwo/OpenCL
modules (Jönsson & Ynnerman, IEEE TVCG 23(1), 2017) for TPU hardware.
"""

__version__ = "0.1.0"
