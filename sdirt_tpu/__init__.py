"""sdirt-tpu: TPU-native dual-pixel ray-tracing / depth-estimation framework."""

__version__ = "0.1.0"
