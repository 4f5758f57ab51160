"""Pallas TPU kernels for the performance core (SURVEY.md §7 Phase 2).

Modules:
- `mt_kernel`: ray–triangle Möller–Trumbore intersection megakernel.

Design note on BVH traversal: Mosaic does not lower arbitrary per-lane
int-vector gathers ("Cannot do int indexing on TPU"), which a per-ray
divergent node walk fundamentally requires — so the stackless threaded
traversal (ops/bvh.py) stays in XLA, whose gather lowering handles the node
fetches. The Pallas win is the dense ray×triangle test: VMEM-resident
triangle blocks streamed against ray blocks with the min-reduction fused in
the kernel (no [N,T] intermediate ever hits HBM).
"""
