from . import codec, decoder, encoder, layers, local_transformer, quantizer, tconv  # noqa: F401
