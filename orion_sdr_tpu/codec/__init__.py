from .varicode import (
    VARICODE, VARICODE_MAX_BITS, varicode_encode, varicode_decode,
    VaricodeEncoder, VaricodeDecoder, encode_text, decode_bits,
)
from .psk31 import (
    DQPSK_EXP, conv_encode, viterbi_decode, viterbi_decode_coherent,
    viterbi_decode_hard, StreamingViterbi,
)

def __getattr__(name):
    # lazy: psk31_stream pulls in demodulate→modulate, which import this
    # package for varicode — a cycle if resolved eagerly.
    if name == "Psk31Stream":
        from .psk31_stream import Psk31Stream
        return Psk31Stream
    raise AttributeError(name)
