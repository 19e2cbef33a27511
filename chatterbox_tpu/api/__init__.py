from .tts import ChatterboxTTS, Conditionals
from .wrapper import ChatterboxMultilingualTTS, ChatterboxTPUWrapper
