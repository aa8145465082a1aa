from .pytree import count_params, tree_cast, tree_size_bytes

__all__ = ["count_params", "tree_cast", "tree_size_bytes"]
