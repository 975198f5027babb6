from .dataset import AcousticDataset, TextOnlyDataset
from .textgrid import read_textgrid
