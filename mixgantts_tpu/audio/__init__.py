from .mel import mel_filterbank
from .stft import TacotronSTFT
from .wav import load_wav, save_wav
