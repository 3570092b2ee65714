PREFIX ex: <http://ex.org/>
DELETE DATA { _:b ex:p "v" }
