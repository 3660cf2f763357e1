from .chip import Chip, IndexAllocator, pad_to_power_of_two
