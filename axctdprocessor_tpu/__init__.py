"""axctdprocessor_tpu — a TPU-native AXCTD audio decoding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
AXCTDprocessor reference (cdens/AXCTDprocessor): decoding Airborne
eXpendable Conductivity-Temperature-Depth (AXCTD) probe audio — an
800-baud FSK bitstream (mark 400 Hz / space 800 Hz) in a VHF FM
downlink recording — into temperature/conductivity/salinity/depth
profiles.

Two decode engines are provided:

* ``models.parity_engine`` — a host-orchestrated streaming state machine
  that is byte-identical to the reference CLI's ``output.txt`` (including
  its chunk semantics; see reference AXCTDprocessor.py:267-338).
* ``models.tpu_engine`` — a whole-waveform fused decoder built for TPU:
  framed multi-tone DFT powers on the MXU, parallel IIR via associative
  scan, pointer-doubling bit-edge chaining and frame sync, vectorized
  CRC-6 as a GF(2) matmul, and a JAX port of PSS-78 ``SP_from_C``.

``parallel`` adds batched (vmap) multi-drop decode and mesh-sharded
archive reprocessing (data-parallel over drops, sequence-parallel over
the time axis with halo exchange).
"""

__version__ = "0.1.0"
