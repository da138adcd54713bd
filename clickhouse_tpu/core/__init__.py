from . import dtypes
from .block import Block, block_from_pydict
from .column import Column, Dictionary, column_from_numpy, pad_to, PAD_MULTIPLE
from .settings import Settings
from . import errors
