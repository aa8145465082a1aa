from .trainer import make_train_step, train_loss

__all__ = ["make_train_step", "train_loss"]
