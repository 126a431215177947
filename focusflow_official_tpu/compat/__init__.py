from .torch_import import torch_key_for_path, torch_state_dict_to_variables

__all__ = ["torch_key_for_path", "torch_state_dict_to_variables"]
