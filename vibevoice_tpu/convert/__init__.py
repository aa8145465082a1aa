from .import_torch import import_state_dict, load_nnscaler, load_pretrained

__all__ = ["import_state_dict", "load_nnscaler", "load_pretrained"]
