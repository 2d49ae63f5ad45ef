from grouptraj.data.reader import read_file, poly_fit, extract_windows  # noqa: F401
from grouptraj.data.dataset import TrajectoryDataset, Window  # noqa: F401
from grouptraj.data.batching import DenseBatch, DenseDataset, DenseLoader  # noqa: F401
from grouptraj.data.loader import data_loader  # noqa: F401
