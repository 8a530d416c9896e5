from hemx.utils.terminal import message, format_for_terminal, INFO, WARNING, ERROR
