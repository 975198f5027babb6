from .mixgantts import MixGANTTS, GeneratorOutput
from .discriminator import JCUDiscriminator
