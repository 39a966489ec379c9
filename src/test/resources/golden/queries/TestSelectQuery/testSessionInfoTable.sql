SELECT name, value FROM information_schema.session WHERE name = 'CURRENT_DATABASE';
