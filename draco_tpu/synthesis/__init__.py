"""Synthesis (simulation) task library.

Re-provides the reference's ``draco/synthesis`` modules (stream, noise,
gain, mockcatalog — SURVEY.md section 2.2) on the TPU-native compute path:
batched SHT + beam-transfer einsums, TPU-PRNG noise/gain draws.
"""
