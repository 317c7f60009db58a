from .registry import Character, CHARACTERS, get_character, HEELED_CHARACTERS
from . import defs
