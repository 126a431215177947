from .instance_norm import instance_norm_pallas, pallas_instance_norm_supported

__all__ = ["instance_norm_pallas", "pallas_instance_norm_supported"]
