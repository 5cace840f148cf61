"""Engine operators: reusable DataFrame → DataFrame transforms.

Batch and streaming share these — each function takes a DataFrame built
from either ``spark.read`` or ``spark.readStream`` (SURVEY §7 design
stance).
"""
