MOVE <urn:g:two> TO DEFAULT
