"""TPU-native IEEE 802.11a/n/ac PHY framework."""
