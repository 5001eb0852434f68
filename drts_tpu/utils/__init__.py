"""Core math & host utilities (the reference's NVIDIA-MathLib / helper layer)."""
