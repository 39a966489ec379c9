SELECT CHAR_LENGTH('héllo') AS cl,
       LENGTH('héllo') AS l,
       OCTET_LENGTH('héllo') AS ol,
       BIT_LENGTH('ab') AS bl;
