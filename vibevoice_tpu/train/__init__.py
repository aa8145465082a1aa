from .data import TrainingCollator, batch_iterator
from .loop import train_loop
from .trainer import make_optimizer, make_train_step, train_loss

__all__ = ["make_optimizer", "make_train_step", "train_loss", "train_loop",
           "TrainingCollator", "batch_iterator"]
