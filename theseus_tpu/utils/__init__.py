from . import examples
