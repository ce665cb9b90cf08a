"""agplace_tpu — TPU-native aerial-ground cross-view place recognition.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
AGPlace (CVPR 2025, sijieaaa/AGPlace).  See SURVEY.md for the reference
analysis and README.md for the design.
"""

__version__ = "0.1.0"
