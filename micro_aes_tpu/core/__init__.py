from .cipher import aes_cipher, decrypt_blocks, encrypt_blocks
from .keyschedule import expand_key, num_rounds
from .sbox import GF_INV, INV_SBOX, SBOX

__all__ = [
    "aes_cipher",
    "decrypt_blocks",
    "encrypt_blocks",
    "expand_key",
    "num_rounds",
    "SBOX",
    "INV_SBOX",
    "GF_INV",
]
