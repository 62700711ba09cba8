"""Preprocessing toolchain: DWPose skeleton extraction, face ID embedding,
face-mask extraction — the reference's ONNX/OpenCV layer (SURVEY.md §2.1
items 9-13) rebuilt so the neural nets run as JAX/XLA graphs (weights
converted from the original ONNX files by preproc/onnx_to_jax.py) and the
geometry/rasterisation runs on host."""
