"""L3/L4 reconstruction: Sculptor/Photographer/fusers + inference API."""
from . import checkpoint, fusion, models, utils  # noqa: F401
from .models import Photographer, Sculptor, autoencode, decode, encode  # noqa: F401
