"""minsu3d_tpu — a TPU-native 3D instance-segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of MINSU3D
(PointGroup / HAIS / SoftGroup on ScanNet v2 and MultiScan): the
MinkowskiEngine sparse-conv U-Net is replaced by a jittable sparse-conv
engine over fixed-capacity voxel buffers, and the C++/CUDA clustering ops
by on-device grid-hash ball query + iterative label propagation.
"""

__version__ = "0.1.0"
