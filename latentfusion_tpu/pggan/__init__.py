"""PGGAN-based discriminator (+ encoder/decoder for completeness).

Behavioral reference: ``latentfusion/pggan/``.
"""
from .discriminator import Discriminator, MultiScaleDiscriminator  # noqa: F401
from .generator import Decoder, Encoder, EncoderDecoder  # noqa: F401
