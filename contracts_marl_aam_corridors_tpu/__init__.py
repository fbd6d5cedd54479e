"""TPU-native MARL framework for air-corridor traffic control.

See README.md for the architecture and the component map to the reference
(Jaroan/Contracts-MARL-AAM-Corridors).
"""

__version__ = "0.1.0"
