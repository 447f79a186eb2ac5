"""Batch (DataFrame/Catalyst) implementations of the engine's operators.

Everything here is declarative DataFrame/SQL first: Catalyst gets to push
filters into the parquet scan, prune columns, broadcast small join sides,
and keep the hot path inside whole-stage codegen. Python only appears in
the kernel-backed multi-window operator (``scotty_batch``) and the
multimodal stubs — always Arrow-batched per key group, never per row.
"""
